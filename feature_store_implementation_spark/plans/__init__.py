from .inventory import QUERIES, ORACLE_SQL, QuerySpec, query

__all__ = ["QUERIES", "ORACLE_SQL", "QuerySpec", "query"]
