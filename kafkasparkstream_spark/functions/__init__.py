"""Engine scalar-function library (deterministic, cross-engine)."""
