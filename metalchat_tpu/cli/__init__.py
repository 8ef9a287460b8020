"""Ollama-style CLI (reference: program/, SURVEY.md §2.8)."""
