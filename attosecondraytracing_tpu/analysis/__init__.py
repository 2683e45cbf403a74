"""Analysis: detector statistics, optimizers, plots."""
