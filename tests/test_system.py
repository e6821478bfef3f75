"""Host topology detection (reference system.cpp semantics)."""

from mvtrim_tpu.utils import system


class TestCpuDetection:
    def test_limit_in_range(self):
        n = system.detect_cpu_limit()
        assert 1 <= n <= system.MAX_DETECTED_CPUS

    def test_cpuset_parser(self):
        assert system._parse_cpuset("0-3,8,10-11") == 7
        assert system._parse_cpuset("0") == 1
        assert system._parse_cpuset("") == 0

    def test_available_cpus(self):
        assert system.available_cpus() >= 1

    def test_parallel_streams(self):
        assert system.calculate_parallel_streams(2) >= 1
        assert system.calculate_parallel_streams(0) >= 1

    def test_device_info(self):
        info = system.device_info()
        assert len(info) == 8  # virtual CPU mesh in tests
        assert all(d["platform"] == "cpu" for d in info)
