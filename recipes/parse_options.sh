# Minimal flag parser for recipe scripts: turns `--name value` pairs into
# shell variable assignments (the role Kaldi's parse_options.sh plays in
# the reference recipes). Source after defining defaults:
#   . ../parse_options.sh
while [ $# -gt 0 ]; do
    case "$1" in
        --*=*)
            name="${1%%=*}"; name="${name#--}"; value="${1#*=}"
            eval "${name//-/_}=\"\$value\""
            shift ;;
        --*)
            name="${1#--}"
            [ $# -ge 2 ] || { echo "missing value for --$name" >&2; exit 1; }
            eval "${name//-/_}=\"\$2\""
            shift 2 ;;
        *)
            echo "unknown argument: $1" >&2
            exit 1 ;;
    esac
done
