"""Iterative crawl plans: the BFS-wave driver, bloom sidecar, politeness
scheduler, checkpoint/resume, and the single-threaded reference oracle."""
