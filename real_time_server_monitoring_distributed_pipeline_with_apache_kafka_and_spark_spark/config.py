"""Pipeline configuration with the reference's defaults.

Mirrors ``/root/reference/config/config.yaml`` (window/slide at :18-20,
alert thresholds at :22-26, topics at :5-9) as typed dataclasses instead of
a YAML blob, so jobs are parameterized the same way the reference's are.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class WindowConfig:
    """Sliding-window parameters (reference config.yaml:18-20)."""

    duration: str = "30 seconds"
    slide: str = "10 seconds"


@dataclass(frozen=True)
class AlertThresholds:
    """Alert thresholds (reference config.yaml:22-26)."""

    cpu_pct: float = 94.35
    mem_pct: float = 78.06
    net_in: float = 4724.68
    disk_io: float = 4563.25


@dataclass(frozen=True)
class KafkaConfig:
    """Kafka transport config (reference config.yaml:3-9, producer.py:11-22)."""

    broker: str = "localhost:9092"
    topic_cpu: str = "topic-cpu"
    topic_mem: str = "topic-mem"
    topic_net: str = "topic-net"
    topic_disk: str = "topic-disk"
    starting_offsets: str = "earliest"

    @property
    def all_topics(self) -> list[str]:
        return [self.topic_cpu, self.topic_mem, self.topic_net, self.topic_disk]


@dataclass(frozen=True)
class PipelineConfig:
    window: WindowConfig = field(default_factory=WindowConfig)
    thresholds: AlertThresholds = field(default_factory=AlertThresholds)
    kafka: KafkaConfig = field(default_factory=KafkaConfig)


DEFAULT_CONFIG = PipelineConfig()
