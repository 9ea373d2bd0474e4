"""Pipeline planning: resolvers, catalog, unified query, DAG orchestration."""
