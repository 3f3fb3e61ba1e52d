import sys

from real_time_audio_sync_tpu.streaming.app import main

sys.exit(main())
