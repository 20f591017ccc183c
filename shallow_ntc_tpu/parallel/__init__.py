"""Device-mesh parallelism (data-parallel training, spatial-sharded eval)."""
