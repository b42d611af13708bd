"""Pipeline assemblies — the engine's analog of the reference's DAGs
(C1): a stage is a function returning a DataFrame; lineage is the DAG."""
