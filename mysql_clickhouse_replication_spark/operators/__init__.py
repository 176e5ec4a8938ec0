"""Relational operator surface (SURVEY.md sections 2.B-2.H)."""
