"""Model execution: fixed-shape forward batches, bucketed jit runner."""
