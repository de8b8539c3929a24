"""Structured Streaming surface over the events table."""
