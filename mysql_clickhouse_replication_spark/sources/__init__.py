"""Placeholder — filled in by build phases (SURVEY.md section 7)."""
