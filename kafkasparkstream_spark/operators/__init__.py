"""Batch operator library covering SURVEY.md §2 plus the training-data ops."""
