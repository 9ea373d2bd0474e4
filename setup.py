"""Setuptools entry point.

Metadata lives in pyproject.toml's ``[project]`` table; this shim exists so
``pip install -e .`` also works on minimal environments that lack the
``wheel`` package (pip's legacy ``setup.py develop`` path needs only
setuptools). Environments with wheel available use the PEP 660 path and
never execute this beyond ``setup()``.
"""

from setuptools import find_packages, setup

setup(
    name="matchbox-spark",
    version="0.13.0",
    description=(
        "PySpark-native entity-resolution and training-data-pipeline "
        "engine (matchbox-compatible query semantics, Spark-first "
        "execution)"
    ),
    python_requires=">=3.10",
    install_requires=["pyspark>=3.5"],
    extras_require={
        "sql": ["sqlglot"],
        "arrow": ["pandas", "pyarrow", "numpy"],
        "oracle": ["duckdb", "pandas", "pyarrow", "numpy"],
        "test": ["pytest", "hypothesis"],
    },
    packages=find_packages(include=["matchbox_spark", "matchbox_spark.*"]),
)
