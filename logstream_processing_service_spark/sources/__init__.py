from .tables import TABLES, jdbc_table, load_table, register_views  # noqa: F401
