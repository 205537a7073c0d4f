"""Catalog query families (split from catalog.py, r06). Import
openetl_spark.catalog — not these modules directly — to get the
fully-populated registries in their canonical order."""
