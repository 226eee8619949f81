"""Application pipelines (layer L4): free-surface pressure projection and
the assembled-matrix baseline/oracle."""
