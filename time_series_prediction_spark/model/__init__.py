"""Model training / scoring scaffolding (deep-learning-optional)."""
