"""Crawl-pipeline operators (SURVEY.md §2) + training-data operators."""
