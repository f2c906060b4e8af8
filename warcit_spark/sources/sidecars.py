"""S8-S10: YAML sidecar sources -> broadcast DataFrames.

The reference materializes these fully in driver RAM (converter.py:198-203,
220-230, 70-95); the Spark analog is a driver-side ``yaml.safe_load``
followed by ``createDataFrame`` — they are side *inputs*, never the big
side of anything.

Schemas (FIXTURES.md §5-6):
- conversions(source_url, url, output, success, metadata{name, ext,
  command, mime, skip_as_source})
- transclusions(media_url, contain_url, contain_ts, selector,
  metadata_file)
- rules: returned as plain Python config (regexes become ``rlike``
  literals at plan-build time — the Catalyst analog of the reference's
  ``re.compile`` precompilation, SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

CONVERSIONS_SCHEMA = StructType(
    [
        StructField("source_url", StringType()),
        # position of the result within its source_url list — the
        # conversion-file order the reference iterates in (converter.py:257)
        StructField("seq", IntegerType()),
        StructField("url", StringType()),
        StructField("output", StringType()),
        StructField("success", BooleanType()),
        # WARC record type of the derived record: conv.get('type',
        # 'conversion') (converter.py:216)
        StructField("rec_type", StringType()),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("name", StringType()),
                    StructField("ext", StringType()),
                    StructField("command", StringType()),
                    StructField("mime", StringType()),
                    StructField("skip_as_source", BooleanType()),
                ]
            ),
        ),
    ]
)

TRANSCLUSIONS_SCHEMA = StructType(
    [
        StructField("media_url", StringType()),
        # position within the media url's entry list (file order)
        StructField("seq", IntegerType()),
        StructField("contain_url", StringType()),
        StructField("contain_ts", StringType()),
        StructField("selector", StringType()),
        StructField("metadata_file", StringType()),
    ]
)


def conversions_from_dict(spark: SparkSession, doc: dict) -> DataFrame:
    """Flatten ``{conversions: {source_url: [result...]}}``
    (converter.py:171-178)."""
    rows = []
    for source_url, results in (doc.get("conversions") or {}).items():
        for seq, r in enumerate(results or []):
            md = r.get("metadata") or {}
            rows.append(
                (
                    source_url,
                    seq,
                    r.get("url"),
                    r.get("output"),
                    bool(r.get("success", False)),
                    r.get("type", "conversion"),
                    (
                        md.get("name"),
                        md.get("ext"),
                        md.get("command"),
                        md.get("mime"),
                        md.get("skip_as_source"),
                    )
                    if md
                    else None,
                )
            )
    return spark.createDataFrame(rows, CONVERSIONS_SCHEMA)


def transclusions_from_dict(spark: SparkSession, doc: dict) -> DataFrame:
    """Flatten ``{transclusions: {media_url: [{url, timestamp, selector,
    metadata_file?}...]}}`` (converter.py:220-238); entries without a
    contain url are skipped (warn-skip path, converter.py:234-236)."""
    rows = []
    for media_url, entries in (doc.get("transclusions") or {}).items():
        for seq, e in enumerate(entries or []):
            if not e.get("url"):
                continue
            rows.append(
                (
                    media_url,
                    seq,
                    e.get("url"),
                    str(e.get("timestamp")) if e.get("timestamp") is not None else None,
                    e.get("selector"),
                    e.get("metadata_file"),
                )
            )
    return spark.createDataFrame(rows, TRANSCLUSIONS_SCHEMA)


def load_yaml(path: str) -> dict:
    if yaml is None:  # pragma: no cover
        raise NotImplementedError("PyYAML not installed")
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def write_conversions_yaml(results: DataFrame, path: str) -> dict:
    """K-sink: the conversion-results YAML, merge-on-write like the
    reference (converter.py:97-115: read existing file, ``update`` its
    ``conversions`` map, dump ``default_flow_style=False``).

    ``results`` is the run_conversions output shape; it is sidecar-small
    by contract (the reference holds it fully in driver RAM), so the
    driver-side collect is the intended topology, not a scale bug.
    Returns the merged document (handy for tests).
    """
    if yaml is None:  # pragma: no cover
        raise NotImplementedError("PyYAML not installed")
    rows = results.collect()
    has_seq = rows and "seq" in rows[0].__fields__
    if has_seq:
        rows = sorted(rows, key=lambda r: (r.source_url, r.seq))
    fresh: dict = {}
    for r in rows:
        md = {
            k: v
            for k, v in (r.metadata.asDict().items() if r.metadata else [])
            if v is not None
        }
        entry = {
            "url": r.url,
            "output": r.output,
            "metadata": md,
            "type": getattr(r, "rec_type", None) or "conversion",
            "success": bool(r.success),
        }
        fresh.setdefault(r.source_url, []).append(entry)

    try:
        with open(path) as fh:
            root = yaml.safe_load(fh.read()) or {}
    except OSError:
        root = {}
    root.setdefault("conversions", {}).update(fresh)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(yaml.dump(root, default_flow_style=False))
    return root


def default_conversion_rules() -> dict:
    """The packaged default rule set — semantics of the reference's
    default-conversion-rules.yaml (ffmpeg web + lossless derivatives per
    media container), built programmatically.  Returns the same
    ``{output_dir, url_prefix, file_types: [...]}`` shape load_yaml gives.
    """

    def rule(name, ext, command, mime, **extra):
        return {"name": name, "ext": ext, "command": command, "mime": mime, **extra}

    png_poster = rule(
        "png_poster", "png",
        "ffmpeg -i {input} -vf thumbnail,scale=640:360 -frames:v 1 {output}",
        "image/png", poster=True,
    )
    webm = rule(
        "webm", "webm",
        "ffmpeg -y -i {input} -c:v vp9 -c:a libopus -speed 4 {output}",
        "video/webm",
    )
    mp4 = rule(
        "mp4", "mp4",
        "ffmpeg -y -i {input} -c:v libx264 -pix_fmt yuv420p -c:a aac -strict -2 {output}",
        "video/mp4",
    )
    ffv1_flac = rule(
        "ffv1_flac", "mkv",
        "ffmpeg -y -i {input} -c:v ffv1 -c:a flac {output}",
        "video/x-matroska", skip_as_source=True,
    )
    mp3 = rule(
        "mp3", "mp3",
        "ffmpeg -y -i {input} -c:a libmp3lame -b:a 320k {output}",
        "audio/mpeg",
    )
    webm_audio = rule(
        "webm_audio", "webm",
        "ffmpeg -y -i {input} -c:a libopus -speed 4 {output}",
        "audio/webm",
    )
    flac = rule(
        "flac", "flac",
        "ffmpeg -y -i {input} -c:a flac {output}",
        "audio/flac", skip_as_source=True,
    )
    video_full = [png_poster, webm, mp4, ffv1_flac]
    return {
        "output_dir": "./conversions",
        "url_prefix": "http://",
        "file_types": [
            {"ext": ".flv", "conversion_rules": video_full},
            {"ext": ".mp4", "conversion_rules": [png_poster, webm, ffv1_flac]},
            {"ext": ".rm", "conversion_rules": video_full},
            {"ext": ".ra", "conversion_rules": [webm_audio, mp3, flac]},
        ],
    }


def read_conversions(spark: SparkSession, path: str) -> DataFrame:
    return conversions_from_dict(spark, load_yaml(path))


def read_transclusions(spark: SparkSession, path: str) -> DataFrame:
    return transclusions_from_dict(spark, load_yaml(path))
