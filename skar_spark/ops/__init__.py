"""Driver-facing query surface: relational operators + training-data ops."""
