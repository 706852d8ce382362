"""State: checkpoint manifest, lineage records, resumable partitioned output."""
