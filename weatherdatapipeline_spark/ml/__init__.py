"""ML path (SURVEY.md §3.2/§3.3): Spark ML training, time-ordered CV,
metric aggregates, model registry, serving."""
