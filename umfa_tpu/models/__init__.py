"""Model-level workloads (reference L5: examples/flux, examples/zimage,
examples/deepseek-v3.2-exp — SURVEY.md §1)."""
