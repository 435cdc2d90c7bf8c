"""IPv4 helper functions (string_functions.go ip_* family).

openGemini evaluates these row-wise in Go; here they are pure integer/string
column arithmetic (split + shifts), so they stay in whole-stage codegen and
the DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def ip_to_int(col) -> Column:
    """Dotted-quad IPv4 → uint32 as int64."""
    c = _c(col)
    return (
        F.split_part(c, F.lit("."), F.lit(1)).cast("long") * 16777216
        + F.split_part(c, F.lit("."), F.lit(2)).cast("long") * 65536
        + F.split_part(c, F.lit("."), F.lit(3)).cast("long") * 256
        + F.split_part(c, F.lit("."), F.lit(4)).cast("long")
    )


def int_to_ip(col) -> Column:
    c = _c(col)
    return F.concat_ws(
        ".",
        (F.shiftright(c, 24).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(c, 16).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(c, 8).bitwiseAND(F.lit(255))).cast("string"),
        (c.bitwiseAND(F.lit(255))).cast("string"),
    )


def ip_prefix(col, prefix_len: int) -> Column:
    """Network address of ip at the given prefix length (ip_prefix)."""
    mask = (0xFFFFFFFF << (32 - prefix_len)) & 0xFFFFFFFF
    return int_to_ip(ip_to_int(col).bitwiseAND(F.lit(mask)))


def ip_mask(col, prefix_len: int) -> Column:
    """Anonymize: keep the /prefix_len network, zero the host bits (ip_mask)."""
    return ip_prefix(col, prefix_len)


def subnet_min(cidr_ip, prefix_len: int) -> Column:
    """First address of the subnet (ip_subnet_min)."""
    return ip_prefix(cidr_ip, prefix_len)


def subnet_max(cidr_ip, prefix_len: int) -> Column:
    """Last address of the subnet (ip_subnet_max)."""
    host = (1 << (32 - prefix_len)) - 1
    mask = (0xFFFFFFFF << (32 - prefix_len)) & 0xFFFFFFFF
    base = ip_to_int(cidr_ip).bitwiseAND(F.lit(mask))
    return int_to_ip(base + F.lit(host))


def is_subnet_of(ip_col, net_ip: str, prefix_len: int) -> Column:
    """True iff ip falls inside net_ip/prefix_len (is_subnet_of)."""
    mask = (0xFFFFFFFF << (32 - prefix_len)) & 0xFFFFFFFF
    net_parts = [int(p) for p in net_ip.split(".")]
    net_int = (
        net_parts[0] * 16777216 + net_parts[1] * 65536 + net_parts[2] * 256 + net_parts[3]
    ) & mask
    return ip_to_int(ip_col).bitwiseAND(F.lit(mask)) == F.lit(net_int)


def ip_in_range(ip_col, cidr: str) -> Column:
    """IPINRANGE(ip, 'a.b.c.d/len') predicate (influxql token IPINRANGE)."""
    net, plen = cidr.split("/")
    return is_subnet_of(ip_col, net, int(plen))


def ip_mask_dual(col, v4bits: int, v6bits: int) -> Column:
    """ip_mask(ip, v4bits[, v6bits]) (reference string function ip_mask,
    server_test.go IP_For_String_Functions): mask an IPv4 address to
    v4bits and an IPv6 address to v6bits, rendering the network address;
    unparseable addresses yield null. Arrow-batched (ipaddress handles
    the v6 compression rules the JVM integer path can't)."""
    from pyspark.sql.functions import pandas_udf

    def _mask(s):
        import ipaddress

        def one(v):
            if v is None:
                return None
            try:
                ip = ipaddress.ip_address(v)
            except ValueError:
                return None
            bits = v4bits if ip.version == 4 else v6bits
            net = ipaddress.ip_network(f"{v}/{bits}", strict=False)
            return str(net.network_address)

        return s.map(one)

    return pandas_udf(_mask, "string")(_c(col))
