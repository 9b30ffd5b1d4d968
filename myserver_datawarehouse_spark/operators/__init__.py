"""Engine operators that go beyond single Spark primitives.

- timeseries: gap-fill + interpolation (reference T1-T5, SURVEY.md §2.9)
- dims: generated date/time/source dimensions (SURVEY.md §1.1, S9)
- merge: bulk upsert writer (reference S4, SURVEY.md §2.1)
"""
