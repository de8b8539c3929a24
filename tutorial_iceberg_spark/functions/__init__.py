"""Scalar / aggregate / JSON / vector / text function surface."""
