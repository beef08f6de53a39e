"""Deterministic scoring models (langid, n-gram LM) shared by the Spark
pipeline's pandas UDFs and the pandas oracle."""
