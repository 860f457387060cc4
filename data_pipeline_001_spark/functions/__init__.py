"""Scalar/column function surface (SURVEY.md §2.8)."""
