"""Readers / adapters for the pages input table, and report sinks."""

from .pages import documents_as_pages, read_documents, read_pages
from .report_sink import write_report

__all__ = ["read_pages", "read_documents", "documents_as_pages", "write_report"]
