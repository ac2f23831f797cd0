"""End-to-end Dataset pipeline compositions."""
