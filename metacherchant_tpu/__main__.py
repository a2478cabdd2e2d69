"""`python -m metacherchant_tpu` CLI entry (equivalent of the self-executing
jar stub, src/stub.sh + src/Runner.java)."""
import sys

from .runner import main

if __name__ == "__main__":
    sys.exit(main())
