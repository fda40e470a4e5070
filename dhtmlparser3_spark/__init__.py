"""dhtmlparser3_spark — a PySpark-native HTML extraction engine with the
query and data-processing capabilities of Bystroushaak/dhtmlparser3.

Drop-in single-document API (reference-compatible surface):

    from dhtmlparser3_spark import parse, Tag, Comment
    dom = parse("<div>...</div>")
    dom.find("a", {"class": "x"})[0].content_str()

Spark tiers:

* ``functions.extract``   — Arrow-vectorized parse/serialize UDFs
* ``operators.nodes``     — the DOM as a flat node table (relational find)
* ``pipeline.extract_job``— salted-repartition extraction job
* ``pipeline.lineage``    — checkpointed idempotent resume
* ``streaming``           — readStream/foreachBatch lift of the batch job
* ``sources.pages``       — deterministic CC-style pages table
"""

from dhtmlparser3_spark.engine.api import Comment, Node, Tag, parse

__all__ = ["parse", "Tag", "Comment", "Node"]
