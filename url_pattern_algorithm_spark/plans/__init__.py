"""End-to-end pipelines mirroring the reference entry points (SURVEY.md §3)
plus the frontier crawl loop (north_rule)."""
