"""Placeholder — populated in SURVEY.md §7 build order."""
