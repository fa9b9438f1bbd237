"""Readers / adapters for the pages input table."""

from .pages import read_pages, documents_as_pages

__all__ = ["read_pages", "documents_as_pages"]
