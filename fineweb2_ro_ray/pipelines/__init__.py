"""Pipeline DAG builders (the reference's `run.sh` stage chain as one
streaming Ray Data DAG)."""
