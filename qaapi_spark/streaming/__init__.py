"""Streaming variants of the batch reconcile (reference is strictly
batch — SURVEY.md §2.9; this package holds the optional incremental
surface: landing-directory file stream + foreachBatch merge)."""
