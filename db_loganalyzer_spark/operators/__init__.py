"""Relational / window / text operators — pure DataFrame -> DataFrame
functions, one section per SURVEY.md §2 family."""
