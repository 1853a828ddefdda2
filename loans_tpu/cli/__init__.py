"""Command-line entry points (reference CLI surface parity)."""
