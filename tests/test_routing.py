"""Port of the reference's filter behavioral spec
(filter/filter_test.go, filter/filter_factory.go) to the compiled
Column predicates.
"""

import pytest
from pyspark.sql import Row

from xmidt_event_streams_spark.config import (
    FilterConfig,
    FilterConfigError,
    load_filter_configs,
)
from xmidt_event_streams_spark.routing import (
    filter_predicate,
    route,
    route_union,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(dest=d, source=s) for d, s in rows], "dest string, source string"
    )


def _matched(spark, fc, rows):
    df = _df(spark, rows).withColumn("m", filter_predicate(fc))
    return [r["dest"] for r in df.collect() if r["m"]]


class TestEventMatching:
    """filter_test.go:136-204 + :398-483 (prefix handling)."""

    def test_strips_event_prefix(self, spark):
        fc = FilterConfig("s", events=("device-.*",))
        assert _matched(spark, fc, [("event:device-status", "x")]) == [
            "event:device-status"
        ]

    def test_no_prefix_to_strip(self, spark):
        # TrimPrefix semantics: absent prefix leaves the string intact
        fc = FilterConfig("s", events=("device-.*",))
        assert _matched(spark, fc, [("device-status", "x")]) == ["device-status"]

    def test_empty_destination_matches_dot_star(self, spark):
        fc = FilterConfig("s", events=(".*",))
        assert _matched(spark, fc, [("", "x")]) == [""]

    def test_event_prefix_only_matches_dot_star(self, spark):
        fc = FilterConfig("s", events=(".*",))
        assert _matched(spark, fc, [("event:", "x")]) == ["event:"]

    def test_unanchored_match(self, spark):
        # Go MatchString is unanchored; rlike must behave identically
        fc = FilterConfig("s", events=("status",))
        assert _matched(spark, fc, [("event:device-status/mac:1/online", "x")])

    def test_or_over_patterns_first_match_wins(self, spark):
        fc = FilterConfig("s", events=("nope", "device-.*"))
        assert _matched(spark, fc, [("event:device-status", "x")])

    def test_non_match_is_dropped(self, spark):
        fc = FilterConfig("s", events=("^other$",))
        assert _matched(spark, fc, [("event:device-status", "x")]) == []


class TestDeviceMatching:
    """filter_test.go:206-293 (metadata/device-id matching)."""

    def test_empty_matcher_list_passes_all(self, spark):
        fc = FilterConfig("s", events=(".*",), device_ids=())
        assert _matched(spark, fc, [("event:e", "any-source")])

    def test_matches_source(self, spark):
        fc = FilterConfig("s", events=(".*",), device_ids=("mac:11.*",))
        assert _matched(spark, fc, [("event:e", "mac:112233445566")])

    def test_matches_stripped_destination(self, spark):
        # device regex may match the destination too (filter.go:87)
        fc = FilterConfig("s", events=(".*",), device_ids=("device-status.*",))
        assert _matched(spark, fc, [("event:device-status/mac:1", "dns:other")])

    def test_no_match_either_side_drops(self, spark):
        fc = FilterConfig("s", events=(".*",), device_ids=("^uuid:.*",))
        assert _matched(spark, fc, [("event:e", "mac:112233445566")]) == []

    def test_wildcard_elision(self, spark):
        # filter_factory.go:145-151: a literal ".*" clears the list
        fc = FilterConfig("s", events=(".*",), device_ids=(".*", "^uuid:.*"))
        assert fc.effective_device_ids == ()
        assert _matched(spark, fc, [("event:e", "anything")])


class TestConfigValidation:
    """filter_factory.go:129-168 plan-time errors."""

    def test_empty_events_rejected(self):
        with pytest.raises(FilterConfigError):
            FilterConfig("s", events=())

    def test_invalid_regex_rejected(self):
        with pytest.raises(FilterConfigError):
            FilterConfig("s", events=("[invalid",))

    def test_unknown_dest_type_rejected(self):
        with pytest.raises(FilterConfigError):
            load_filter_configs([{"stream_name": "s", "events": [".*"], "dest_type": "webhook"}])

    def test_yaml_shape_loading(self):
        cfgs = load_filter_configs(
            {
                "filter_manager": {
                    "filters": [
                        {
                            "stream_name": "a",
                            "events": ["device-status.*"],
                            "metadata": {"device_ids": ["mac:.*"]},
                            "alt_streams": ["a-alt"],
                        }
                    ]
                }
            }
        )
        assert cfgs[0].stream_name == "a"
        assert cfgs[0].device_ids == ("mac:.*",)
        assert cfgs[0].streams_in_order == ("a", "a-alt")


# the reference's full config-file layout (streams_only.yaml:26-77):
# filter_manager defaults + a filters list whose stream entry nests
# stream_name and config_items key/value pairs
_REFERENCE_SHAPE_YAML = """
filter_manager:
  delivery_retries: 3
  default_queue_size: 1000
  default_batch_size: 100
  default_max_workers: 1000

  filters:
      - stream:
          stream_name: "comcast-cl.device-status.local"
          config_items:
              - key: "endpoint"
                value: "http://localhost:4567"
              - key: "region"
                value: "local"
              - key: "version"
                value: "1.0"
        alt_streams: []
        events:
          - "device-status.*"
        metadata:
          device_ids: []
        dest_type: "kinesis"
        stream_version: "1.0"
        queue_size: 100
        batch_size: 1
        max_workers: 100
      - stream:
          stream_name: "boot-time.local"
          config_items: []
        alt_streams: ["boot-time-alt.local"]
        events:
          - "boot-time"
        metadata:
          device_ids: ["mac:.*"]
        dest_type: "kinesis"
"""


class TestYamlFileLoading:
    """load_filter_configs_yaml against the reference's exact
    streams_only.yaml layout (loaded by install/config.go:99-151)."""

    def _load(self, tmp_path, text):
        from xmidt_event_streams_spark.config import load_filter_configs_yaml

        p = tmp_path / "cfg.yaml"
        p.write_text(text)
        return load_filter_configs_yaml(str(p))

    def test_reference_shape_roundtrip(self, tmp_path):
        cfgs = self._load(tmp_path, _REFERENCE_SHAPE_YAML)
        assert len(cfgs) == 2

        c0 = cfgs[0]
        assert c0.stream_name == "comcast-cl.device-status.local"
        assert c0.events == ("device-status.*",)
        assert c0.device_ids == ()          # empty = pass-all
        assert c0.alt_streams == ()
        assert c0.dest_type == "kinesis"
        assert c0.stream_version == "1.0"
        # per-filter tuning overrides win over filter_manager defaults
        assert (c0.queue_size, c0.batch_size, c0.max_workers) == (100, 1, 100)
        # config_items land in options
        assert c0.options["endpoint"] == "http://localhost:4567"
        assert c0.options["region"] == "local"

        c1 = cfgs[1]
        assert c1.stream_name == "boot-time.local"
        assert c1.streams_in_order == ("boot-time.local", "boot-time-alt.local")
        assert c1.device_ids == ("mac:.*",)
        # no overrides -> filter_manager default_* apply
        assert (c1.queue_size, c1.batch_size, c1.max_workers) == (1000, 100, 1000)

    def test_default_filters_equivalent_from_yaml(self, tmp_path):
        """A YAML document compiling to exactly DEFAULT_FILTERS."""
        from xmidt_event_streams_spark.config import DEFAULT_FILTERS

        cfgs = self._load(
            tmp_path,
            """
filter_manager:
  filters:
    - stream: "purchases-stream"
      events: ["purchase.*", "checkout"]
    - stream: "engagement-stream"
      events: ["click", "view"]
      metadata:
        device_ids: ["user-1.*"]
      alt_streams: ["engagement-stream-alt"]
    - stream: "firehose-stream"
      events: [".*"]
      metadata:
        device_ids: [".*"]
""",
        )
        assert tuple(cfgs) == DEFAULT_FILTERS

    def test_invalid_regex_in_yaml_fails_eagerly(self, tmp_path):
        with pytest.raises(FilterConfigError):
            self._load(
                tmp_path,
                """
filter_manager:
  filters:
    - stream: "s"
      events: ["[broken"]
""",
            )


class TestFanOut:
    """filter_manager.go:136-138: every message offered to every filter."""

    def test_message_reaches_all_matching_streams(self, spark):
        filters = [
            FilterConfig("all", events=(".*",)),
            FilterConfig("dev", events=("device-.*",)),
            FilterConfig("none", events=("^zzz$",)),
        ]
        routed = route(_df(spark, [("event:device-status", "m")]), filters)
        assert routed["all"].count() == 1
        assert routed["dev"].count() == 1
        assert routed["none"].count() == 0

    def test_route_union_tags_stream(self, spark):
        filters = [
            FilterConfig("all", events=(".*",)),
            FilterConfig("dev", events=("device-.*",)),
        ]
        out = route_union(_df(spark, [("event:device-status", "m")]), filters)
        assert sorted(r["stream_name"] for r in out.collect()) == ["all", "dev"]


class TestSqlTextBuild:
    """r11: route_union builds its fan-out projection from SQL text
    with config patterns shipped as lossless \\uXXXX string literals
    (the SQL parser silently drops backslashes from escapes it does
    not recognize -- the exact corruption that kept routing
    Column-built in r10). These tests pin (a) literal round-tripping
    for adversarial patterns and (b) result identity between the SQL
    build and the Column build."""

    ADVERSARIAL = [
        FilterConfig("backslash", events=(r"device-\d+", r"a\.b")),
        FilterConfig("quotes", events=("it's", 'say "hi"')),
        FilterConfig("unicode", events=("café.*", "\U0001f600")),
        FilterConfig(
            "escapes", events=(r"tab\tnot", r"Aliteral", r"x\\y")
        ),
        FilterConfig(
            "devs",
            events=(".*",),
            device_ids=(r"mac:\d{12}", "weird'\"\\\\pat"),
        ),
    ]

    def test_literal_roundtrip(self, spark):
        from xmidt_event_streams_spark.routing import sql_string_literal

        pats = [p for fc in self.ADVERSARIAL for p in fc.events] + [
            p for fc in self.ADVERSARIAL for p in fc.device_ids
        ]
        row = spark.sql(
            "SELECT " + ", ".join(
                f"{sql_string_literal(p)} as c{i}" for i, p in enumerate(pats)
            )
        ).collect()[0]
        assert list(row) == pats

    def test_sql_build_matches_column_build(self, spark):
        rows = [
            ("event:device-123/x", "mac:000000000042"),
            ("event:a.b", "m"),
            ("event:axb", "m"),          # a\.b must NOT match this
            ("event:it's", "m"),
            ('event:say "hi" twice', "m"),
            ("event:café-au-lait", "m"),
            ("event:\U0001f600!", "m"),
            ("event:tab\tnot", "m"),
            ("event:Aliteral", "m"),     # Aliteral == Aliteral
            ("event:x\\y", "m"),
            ("no-prefix", "mac:999999999999"),
        ]
        df = _df(spark, rows)
        out_sql = route_union(df, self.ADVERSARIAL)
        # force the Column path by aliasing dest through a Column obj
        from pyspark.sql import functions as F

        out_col = route_union(df, self.ADVERSARIAL, dest=F.col("dest"))
        got = sorted(map(tuple, out_sql.collect()))
        want = sorted(map(tuple, out_col.collect()))
        assert got == want
        assert len(got) > 0
