"""cli — recipe drivers (the reference's example/ layer, SURVEY.md L4)."""
