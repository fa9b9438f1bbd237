"""Pure, deterministic, vectorized kernels shared by the Ray stages and the oracle."""
