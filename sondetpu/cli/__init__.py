"""Command-line interface and typed configuration."""
