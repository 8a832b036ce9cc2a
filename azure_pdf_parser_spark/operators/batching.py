"""O1/O3/O4: page-batch planning, page-number propagation, ordered merge.

The reference splits oversized PDFs into ≤50-page standalone PDFs,
extracts each batch independently, shifts page numbers by the batch's
start page, and concatenates in batch order (reference:
src/azure_pdf_parser/utils.py:35-163). Here the per-batch rows are the
unit of parallelism — the engine's skew-breaker: a 5,000-page document
becomes 100 rows that parse on 100 cores instead of one straggler task.

O3 is pure column arithmetic (narrow, no shuffle). O4 is the pipeline's
one unavoidable shuffle: groupBy(doc_id) with order restored by an
explicit batch_number sort key — Spark gives no free ordering, so every
collect_list is wrapped in array_sort over (batch_number, payload).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BATCH_SIZE = 50  # reference utils.py:15


def plan_batches_col(n_pages: Column, batch_size: int = DEFAULT_BATCH_SIZE) -> Column:
    """array<struct<batch_number, page_range>> for a doc with n_pages.

    Matches reference split math (utils.py:117-163): 1-based inclusive
    ranges, 0-based batch numbers; 68 pages @ 12 → (1,12)..(61,68).
    """
    if batch_size < 1:
        raise ValueError("Batch size must be greater than 0.")
    n_batches = F.ceil(n_pages / F.lit(float(batch_size))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_batches - 1),
        lambda i: F.struct(
            i.cast("int").alias("batch_number"),
            F.struct(
                (i * batch_size + 1).cast("int").alias("first"),
                F.least((i + 1) * batch_size, n_pages).cast("int").alias("last"),
            ).alias("page_range"),
        ),
    )


def _shift_region(region: Column, offset: Column) -> Column:
    return F.struct(
        (region.page_number + offset).cast("int").alias("page_number"),
        region.polygon.alias("polygon"),
    )


def propagate_page_numbers(batches: DataFrame) -> DataFrame:
    """O3 (reference utils.py:35-78), with the quirks preserved:

    * paragraphs: only ``bounding_regions[0]`` is shifted;
    * table cells and tables: ALL regions are shifted;
    * pages: only pages with *truthy* page_number (0 and NULL untouched).

    Narrow transformation — no shuffle.
    """
    offset = (F.col("page_range.first") - 1).alias("page_offset")

    def shift_paragraph(p: Column) -> Column:
        shifted_regions = F.concat(
            F.array(_shift_region(F.element_at(p.bounding_regions, 1), offset)),
            F.slice(
                p.bounding_regions, 2, F.greatest(F.size(p.bounding_regions) - 1, F.lit(0))
            ),
        )
        regions = F.when(
            p.isNotNull()
            & p.bounding_regions.isNotNull()
            & (F.size(p.bounding_regions) > 0),
            shifted_regions,
        ).otherwise(p.bounding_regions)
        return F.when(
            p.isNull(), p
        ).otherwise(
            F.struct(
                p.role.alias("role"),
                p.content.alias("content"),
                regions.alias("bounding_regions"),
                p.spans.alias("spans"),
            )
        )

    def shift_cell(c: Column) -> Column:
        regions = F.when(
            c.isNotNull() & c.bounding_regions.isNotNull(),
            F.transform(c.bounding_regions, lambda r: _shift_region(r, offset)),
        ).otherwise(c.bounding_regions)
        return F.when(c.isNull(), c).otherwise(
            F.struct(
                c.kind.alias("kind"),
                c.row_index.alias("row_index"),
                c.column_index.alias("column_index"),
                c.row_span.alias("row_span"),
                c.column_span.alias("column_span"),
                c.content.alias("content"),
                regions.alias("bounding_regions"),
                c.spans.alias("spans"),
            )
        )

    def shift_table(t: Column) -> Column:
        regions = F.when(
            t.bounding_regions.isNotNull(),
            F.transform(t.bounding_regions, lambda r: _shift_region(r, offset)),
        ).otherwise(t.bounding_regions)
        return F.struct(
            t.row_count.alias("row_count"),
            t.column_count.alias("column_count"),
            F.transform(t.cells, shift_cell).alias("cells"),
            regions.alias("bounding_regions"),
            t.spans.alias("spans"),
        )

    def shift_page(pg: Column) -> Column:
        shifted = (pg.page_number + offset).cast("int")
        return F.when(pg.isNull(), pg).otherwise(
            F.struct(
                # truthiness quirk: page 0 / NULL left untouched (utils.py:74-77)
                F.when(
                    pg.page_number.isNotNull() & (pg.page_number != 0), shifted
                )
                .otherwise(pg.page_number)
                .alias("page_number"),
                pg.width.alias("width"),
                pg.height.alias("height"),
            )
        )

    return (
        batches.withColumn("paragraphs", F.transform("paragraphs", shift_paragraph))
        .withColumn("tables", F.transform("tables", shift_table))
        .withColumn("pages", F.transform("pages", shift_page))
    )


def merge_batches(batches: DataFrame) -> DataFrame:
    """O4 (reference utils.py:81-114): propagate page numbers, then
    concatenate paragraphs/tables/pages across batches in batch order;
    api_version/model_id come from the lowest-numbered batch.

    The one unavoidable shuffle of the pipeline. Order is restored with
    an explicit array_sort on batch_number — never relied on from the
    shuffle. AQE coalesces the post-shuffle partitions; doc_id is a
    high-cardinality key so the exchange is skew-free by construction
    (the split stage already bounded per-row size).
    """
    shifted = propagate_page_numbers(batches)

    def ordered_flat(col: str) -> Column:
        return F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("batch_number"), F.col(col).alias("v")))
                ),
                lambda s: F.coalesce(s.v, F.array().cast(dict(shifted.dtypes)[col])),
            )
        ).alias(col)

    return shifted.groupBy("doc_id").agg(
        F.min_by("api_version", "batch_number").alias("api_version"),
        F.min_by("model_id", "batch_number").alias("model_id"),
        ordered_flat("paragraphs"),
        ordered_flat("tables"),
        ordered_flat("pages"),
    )
