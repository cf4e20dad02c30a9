"""Query catalog + pipeline runner (SURVEY.md §2 inventory, §3 lifecycle)."""
