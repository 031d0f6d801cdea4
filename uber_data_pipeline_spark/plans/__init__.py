"""Declarative model registry + DAG materialization runner — the
engine's counterpart to the reference's dbt models and Dagster asset
graph (/root/reference/Dagster_Files/definitions.py)."""
