"""Column-name quoting for user-supplied names.

Recipe configs rename/pack columns into names containing dots
(`SVM.fit`, `LogReg.predict` — reference examples/aggregations/raw/
svm.yml:21-29). A bare string handed to F.col/F.first/groupBy is parsed
as a struct path (`SVM`.`fit`) and fails to resolve; every engine-side
reference to a recipe-named column must go through qcol().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qname(name: str) -> str:
    """Backtick-quote a column name for use in expression strings."""
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str | Column) -> Column:
    """F.col that treats `name` as a literal column name, dots included."""
    if isinstance(name, Column):
        return name
    return F.col(qname(name))
