"""Reusable DataFrame operators (SURVEY.md §2.5, §2.13)."""
