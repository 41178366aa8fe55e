"""Filled in by later build steps (SURVEY.md §7)."""
