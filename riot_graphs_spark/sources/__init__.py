from .tables import load_table, register_tables  # noqa: F401
