"""Core utilities: deterministic RNG, timers, error norms, configs, registry."""
