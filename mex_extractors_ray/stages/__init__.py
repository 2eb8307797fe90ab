"""Operator library: the reference's transform/filter/dedup/join/aggregate
inventory (SURVEY.md §2) plus large-scale training-data ops, each expressed
as vectorized Ray Data batch transforms."""
