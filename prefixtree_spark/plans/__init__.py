from prefixtree_spark.plans.tree import PT_SCHEMA, VIRTUAL_ROOT_ID

__all__ = ["PT_SCHEMA", "VIRTUAL_ROOT_ID"]
