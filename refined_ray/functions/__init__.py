"""Pure vectorized kernels. No Ray imports here."""
