"""Sources: table catalog readers and deterministic fixture generators."""
