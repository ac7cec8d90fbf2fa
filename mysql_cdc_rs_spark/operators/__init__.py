"""Pipeline operators (SURVEY §2): decode, enrich, route, stats, window
context, diff, dedup, similarity, text analysis."""
