"""End-to-end pipeline plans: learn (types + patterns), extract, evaluate."""
