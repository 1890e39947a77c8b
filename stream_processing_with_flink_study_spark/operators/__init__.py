"""Operator library (SURVEY.md §2.2-§2.7)."""
