"""Structured Streaming ingestion (SURVEY.md §2.10).

The reference's only 'stream' is the weekly batch append of new games
(2_scrape_new_games.R). Per the driver north star, the engine also
exposes a true streaming path over the ``events`` fixture shape.
"""
