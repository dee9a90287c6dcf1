"""Sensor and packet constants for Velodyne HDL-class LiDARs.

Contract parity with the reference's constants (reference type_defs.h:16-23)
and intra-frame timing models (reference HDLParser.cxx:133-145), which are
public Velodyne datasheet values.
"""

# --- HDL data packet layout (type_defs.h:17-19, HDLParser.cxx:67-87) ---------
HDL_PACKET_BYTES = 1206          # payload size of one LiDAR data packet
HDL_FIRINGS_PER_PACKET = 12      # firing blocks per packet
HDL_LASERS_PER_FIRING = 32       # laser returns per firing block
HDL_FIRING_BYTES = 100           # 2 (block id) + 2 (azimuth) + 32 * 3
HDL_MAX_LASERS = 64

POSITION_PACKET_BYTES = 512      # GPS/position packet payload (554 - 42)

# Firing-block identifiers (reference HDLParser.cxx:61-65).
BLOCK_ID_0_TO_31 = 0xEEFF
BLOCK_ID_32_TO_63 = 0xDDFF

# Azimuth is reported in hundredths of a degree, [0, 36000).
AZIMUTH_TICKS_PER_REV = 36000
AZIMUTH_TICKS_PER_DEG = 100.0

# Distance is reported in 2 mm units (reference HDLParser.cxx:614).
DISTANCE_UNIT_M = 0.002

# --- Static shape bounds (type_defs.h:20) ------------------------------------
# Maximum firings per revolution; also bounds points-per-laser per frame.
MAX_FIRINGS_PER_FRAME = 2200

# --- Intra-frame timing models (µs) (reference HDLParser.cxx:133-145) --------
HDL32_FIRING_BLOCK_US = 46.08    # per firing block
HDL32_LASER_US = 1.152           # per laser within a block
VLP16_FIRING_BLOCK_US = 110.592  # per block (two 16-laser sub-firings)
VLP16_LASER_US = 2.304
VLP16_SUBFIRING_US = 55.296

# --- Default UDP ports (reference HDLSource.cxx:484-485, INSSource.h:52) -----
LIDAR_DATA_PORT = 2368
LIDAR_POSITION_PORT = 8308
INS_PORT = 6777

# --- INS wire protocol (reference type_defs.h:34-79) -------------------------
INS_MSG_INSPVA = 508
INS_MSG_RAWINS = 325
INS_MSG_BESTGPSPOS = 423
INS_PERIOD_MS = 10               # INSPVA at 100 Hz (type_defs.h:38)

# --- Map layer (reference MapManager.h:13) -----------------------------------
ROI_RANGE_M = 100.0              # sensor detecting range for map ROI queries

WEEK_IN_MICROSECONDS = 604_800_000_000  # 7 * 24 * 3600 * 1e6 (type_defs.h:21)
