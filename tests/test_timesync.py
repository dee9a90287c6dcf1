from veloslam_tpu.core import timesync as ts


def test_ins_timestamp_coarse():
    t = ts.ins_timestamp_us(2000, 123_000)
    assert t == ts.GPS_EPOCH_UNIX_US + 2000 * ts.WEEK_US + 123_000_000


def test_ins_timestamp_fine_overrides():
    # fine time 1.5 ms later than coarse
    t = ts.ins_timestamp_us(2000, 123_000, 2000, 123.0015)
    assert t == ts.GPS_EPOCH_UNIX_US + 2000 * ts.WEEK_US + 123_001_500


def test_ins_timestamp_invalid_fine_falls_back():
    t = ts.ins_timestamp_us(2000, 5, None, None)
    t2 = ts.ins_timestamp_us(2000, 5, 2000, -1.0)
    assert t == t2


def test_hdl_clock_wrap():
    clock = ts.HdlClock()
    base_ref = 1_700_000_000_000_000
    t0 = clock.resolve(3_599_000_000, ref_time_us=base_ref + 3_599_000_000)
    assert t0 == base_ref + 3_599_000_000
    # counter wraps to the next hour
    t1 = clock.resolve(500, )
    assert t1 == base_ref + ts.HOUR_US + 500
    # monotone within the hour
    t2 = clock.resolve(1_000_000)
    assert t2 == base_ref + ts.HOUR_US + 1_000_000
    assert t0 < t1 < t2
