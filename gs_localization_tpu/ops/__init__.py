"""Low-level TPU-friendly numeric ops (k-NN, image filters, reductions)."""
