"""Table-lifecycle query plans built on the icetbl native table layer."""
