"""End-to-end pipelines and declared query plans."""
