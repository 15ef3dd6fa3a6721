"""Query plans: flagship star metrics, metric-view compiler, pipeline DAG."""
