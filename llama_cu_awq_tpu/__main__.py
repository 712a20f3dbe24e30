import sys

from llama_cu_awq_tpu.cli import main

sys.exit(main())
