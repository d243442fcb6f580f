"""Query plans: the oracle-checked query registry and relational core."""
