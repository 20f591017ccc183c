"""Utilities: registry, runnames, sweeps, json, writers, profiling."""
