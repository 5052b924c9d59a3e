"""Text/dedup queries — filled in by the text-analysis layer."""
