"""Sources: binary-file scans, mapfile CSV/TSV, YAML sidecars, fixtures."""
