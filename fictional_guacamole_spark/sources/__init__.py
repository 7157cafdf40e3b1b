"""Streaming sources: the exchange websocket source (S1/S2) and the
file-replay source used for deterministic tests, both built on the
Spark 4 Python DataSource API."""
