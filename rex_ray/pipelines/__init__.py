"""Pipeline compositions and the query/oracle registry."""
