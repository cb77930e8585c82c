"""Batch operators (SURVEY.md §2 inventory + §2.11 extensions)."""
