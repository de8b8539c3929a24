"""Relational operators (projections, filters, aggregations, windows,
sorts, joins) and extension operators (dedup, similarity, multimodal)."""
