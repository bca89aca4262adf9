"""Named query surface exported via __spark_entry__.py and bench.py."""
