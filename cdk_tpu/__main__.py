import sys

from cdk_tpu.cli import main

sys.exit(main())
