"""Reusable Column-expression helpers."""
