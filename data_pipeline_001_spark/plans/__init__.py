"""Planning layer: control table, window planner, orchestrator."""
