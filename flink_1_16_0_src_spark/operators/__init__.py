"""Custom relational operators the reference has and Spark lacks as a
single builtin — each composed from DataFrame ops (scale-safe) with a
Pandas-UDF path only where composition can't express the semantics."""
