"""Recipe engine: YAML recipe → lazy PySpark DataFrame plan.

The reference (bearysta/aggregate.py) executes recipes eagerly over
pandas with a fixed stage order. Here each recipe compiles to one lazy
DataFrame; Catalyst sees the whole pipeline (scan → rename → filters →
precomputed expressions → reshape → aggregate) and pushes
filters/prunes columns across all of it. The only wide operators are
the final group-aggregate, pivot, and the ratio_of joins.
"""

from bearysta_spark.engine.recipe import Recipe
from bearysta_spark.engine.core import RecipeEngine

__all__ = ["Recipe", "RecipeEngine"]
