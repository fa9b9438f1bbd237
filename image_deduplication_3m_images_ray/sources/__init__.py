"""Readers / adapters for the pages input table, and report sinks."""

from .pages import read_pages, documents_as_pages
from .report_sink import write_report

__all__ = ["read_pages", "documents_as_pages", "write_report"]
