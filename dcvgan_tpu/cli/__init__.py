"""Command-line entry points: train, infer, preprocess."""
