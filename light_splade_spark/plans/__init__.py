"""Declarative query plans: corpus stats, exact BM25 SQL path, oracle SQL."""
