"""Engine operators: relational building blocks + LLM-pipeline operators."""
