"""Graph-to-tensor export (EP3 of SURVEY.md §3)."""
