"""Reference-suite parity, batch 7: the DDL command suites — database /
retention-policy / measurement / user commands, row deletion (DELETE
FROM, DROP SERIES), and drop/recreate lifecycles.

Cases transcribed from /root/reference/tests/server_suite.go
(tests["database_commands"]:26, ["retention_policy_commands"]:517,
["measurement_commands"]:147, ["delete_series_time"]:294,
["delete_series_time_tag_filter"]:350, ["drop_and_recreate_series"]:401,
["drop_series_from_regex"]:452, ["drop_and_recreate_database"]:214,
["retention_policy_auto_create"]:649) and
/root/reference/tests/server_test.go (TestServer_UserCommands).

Each suite runs SEQUENTIALLY against its own fresh MetaStore + data root
(DDL state carries between cases by design). Omitted cases, by name:
- "Make sure data wasn't deleted from other database." (and the
  drop_database_isolated suite): the reference writes identical data to
  db0 AND db1 and checks cross-db isolation — this harness stores one
  database per data root, so the scenario is inexpressible here; the
  single-db deletion semantics they guard are covered by the kept cases.
- retention_policy_commands SHOW RETENTION POLICIES cases: their
  expectations carry the influxdb-1.x 5-column shape, which contradicts
  the reference's own meta/data.go:2061 emitter (8 columns with
  hot/warm/index duration) verified by TestServer_DefaultDBAndRP — the
  8-column shape is authoritative and covered in batch 6.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

# --- TestServer_UserCommands (server_test.go:501) ---
UC_WRITES = [
]

UC_CASES = [
    (  
        'show users, no actual users',
        'SHOW USERS',
        '{"results":[{"statement_id":0,"series":[{"columns":["user","admin","rwuser"]}]}]}',
    ),
    (  
        'create user',
        "CREATE USER jdoe WITH PASSWORD 'Jdoe@1337'",
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show users, 1 existing user',
        'SHOW USERS',
        '{"results":[{"statement_id":0,"series":[{"columns":["user","admin","rwuser"],"values":[["jdoe",false,false]]}]}]}',
    ),
    (  
        'grant all priviledges to jdoe',
        'GRANT ALL PRIVILEGES TO jdoe',
        '{"results":[{"statement_id":0,"error":"forbidden to grant or revoke privileges, because only one admin is allowed for the database"}]}',
    ),
    (  
        'show users, existing user as admin',
        'SHOW USERS',
        '{"results":[{"statement_id":0,"series":[{"columns":["user","admin","rwuser"],"values":[["jdoe",false,false]]}]}]}',
    ),
    (  
        'grant DB privileges to user',
        'GRANT READ ON db0 TO jdoe',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'revoke all privileges',
        'REVOKE ALL PRIVILEGES FROM jdoe',
        '{"results":[{"statement_id":0,"error":"forbidden to grant or revoke privileges, because only one admin is allowed for the database"}]}',
    ),
    (  
        'bad create user request, invalid password',
        "CREATE USER jdoe1 WITH PASSWORD '1337'",
        '{"results":[{"statement_id":0,"error":"the password needs to be between 8 and 256 characters long"}]}',
    ),
    (  
        'bad create user request, invalid password',
        "CREATE USER jdoe1 WITH PASSWORD 'Jdoe1337'",
        '{"results":[{"statement_id":0,"error":"The user password must contain more than 8 characters and uppercase letters, lowercase letters, digits, and at least one of the special characters."}]}',
    ),
    (  
        'bad create user request',
        "CREATE USER 0xBAD WITH PASSWORD 'Jdoe@1337'",
        '{"error":"error parsing query: syntax error: unexpected DURATIONVAL, expecting IDENT"}',
    ),
    (  
        'bad create user request, no name',
        "CREATE USER WITH PASSWORD 'Jdoe@1337'",
        '{"error":"error parsing query: syntax error: unexpected WITH, expecting IDENT"}',
    ),
    (  
        'bad create user request, no password',
        'CREATE USER jdoe',
        '{"error":"error parsing query: syntax error: unexpected $end, expecting WITH"}',
    ),
    (  
        'drop user',
        'DROP USER jdoe',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'make sure user was dropped',
        'SHOW USERS',
        '{"results":[{"statement_id":0,"series":[{"columns":["user","admin","rwuser"]}]}]}',
    ),
    (  
        'delete non existing user',
        'DROP USER noone',
        '{"results":[{"statement_id":0,"error":"user not found"}]}',
    ),
]

# --- database_commands (server_test.go:26) ---
X_WRITES = [
]

X_CASES = [
    (  
        'create database should succeed',
        'CREATE DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create database with retention duration should succeed',
        'CREATE DATABASE db0_r WITH DURATION 24h REPLICATION 1 NAME db0_r_policy',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create database with retention policy should be error with invalid name',
        'CREATE DATABASE db1 WITH NAME "."',
        '{"results":[{"statement_id":0,"error":"invalid name"}]}',
    ),
    (  
        'create database should error with some unquoted names',
        'CREATE DATABASE 0xdb0',
        '{"error":"error parsing query: syntax error: unexpected DURATIONVAL, expecting IDENT"}',
    ),
    (  
        'create database should error with invalid characters',
        'CREATE DATABASE "."',
        '{"results":[{"statement_id":0,"error":"invalid name"}]}',
    ),
    (  
        'create database with retention duration should error with bad retention duration',
        'CREATE DATABASE db0 WITH DURATION xyz',
        '{"error":"error parsing query: syntax error: unexpected IDENT, expecting DURATIONVAL"}',
    ),
    (  
        'create database with retention replication should error with bad retention replication number',
        'CREATE DATABASE db0 WITH REPLICATION xyz',
        '{"error":"error parsing query: syntax error: unexpected IDENT, expecting INTEGER"}',
    ),
    (  
        'create database with retention name should error with missing retention name',
        'CREATE DATABASE db0 WITH NAME',
        '{"error":"error parsing query: syntax error: unexpected $end, expecting IDENT"}',
    ),
    (  
        'show database should succeed',
        'SHOW DATABASES',
        '{"results":[{"statement_id":0,"series":[{"name":"databases","columns":["name"],"values":[["db0"],["db0_r"]]}]}]}',
    ),
    (  
        'create database should not error with existing database',
        'CREATE DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create database should create non-existing database',
        'CREATE DATABASE db1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create database with retention duration should error if retention policy is different',
        'CREATE DATABASE db1 WITH DURATION 24h',
        '{"results":[{"statement_id":0,"error":"retention policy conflicts with an existing policy"}]}',
    ),
    (  
        'create database should error with bad retention duration',
        'CREATE DATABASE db1 WITH DURATION xyz',
        '{"error":"error parsing query: syntax error: unexpected IDENT, expecting DURATIONVAL"}',
    ),
    (  
        'show database should succeed',
        'SHOW DATABASES',
        '{"results":[{"statement_id":0,"series":[{"name":"databases","columns":["name"],"values":[["db0"],["db0_r"],["db1"]]}]}]}',
    ),
    (  
        'drop database db0 should succeed',
        'DROP DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'drop database db0_r should succeed',
        'DROP DATABASE db0_r',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'drop database db1 should succeed',
        'DROP DATABASE db1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'drop database should not error if it does not exists',
        'DROP DATABASE db1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'drop database should not error with non-existing database db1',
        'DROP DATABASE db1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show database should have no results',
        'SHOW DATABASES',
        '{"results":[{"statement_id":0,"series":[{"name":"databases","columns":["name"]}]}]}',
    ),
    (  
        'create database with shard group duration should succeed',
        'CREATE DATABASE db0 WITH SHARD DURATION 61m',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create database with shard group duration and duration should succeed',
        'CREATE DATABASE db1 WITH DURATION 60m SHARD DURATION 30m',
        '{"results":[{"statement_id":0}]}',
    ),
]

# --- retention_policy_commands (server_test.go:517) ---
X_2_WRITES = [
]

X_2_CASES = [
    (  
        'create retention policy with invalid name should return an error',
        'CREATE RETENTION POLICY "." ON db0 DURATION 1d REPLICATION 1',
        '{"results":[{"statement_id":0,"error":"invalid name"}]}',
    ),
    (  
        'create retention policy should succeed',
        'CREATE RETENTION POLICY rp0 ON db0 DURATION 1h REPLICATION 1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show retention policy should succeed',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rp0","1h0m0s","1h0m0s",1,false]]}]}]}',
    ),
    (  
        'alter retention policy should succeed',
        'ALTER RETENTION POLICY rp0 ON db0 DURATION 2h REPLICATION 3 DEFAULT',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show retention policy should have new altered information',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rp0","2h0m0s","1h0m0s",3,true]]}]}]}',
    ),
    (  
        'show retention policy should still show policy',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rp0","2h0m0s","1h0m0s",3,true]]}]}]}',
    ),
    (  
        'create a second non-default retention policy',
        'CREATE RETENTION POLICY rp2 ON db0 DURATION 1h REPLICATION 1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show retention policy should show both',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rp0","2h0m0s","1h0m0s",3,true],["rp2","1h0m0s","1h0m0s",1,false]]}]}]}',
    ),
    (  
        'dropping non-default retention policy succeed',
        'DROP RETENTION POLICY rp2 ON db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create a third non-default retention policy',
        'CREATE RETENTION POLICY rp3 ON db0 DURATION 1h REPLICATION 1 SHARD DURATION 30m',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create retention policy with default on',
        'CREATE RETENTION POLICY rp3 ON db0 DURATION 1h REPLICATION 1 SHARD DURATION 30m DEFAULT',
        '{"results":[{"statement_id":0,"error":"retention policy conflicts with an existing policy"}]}',
    ),
    (  
        'show retention policy should show both with custom shard',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rp0","2h0m0s","1h0m0s",3,true],["rp3","1h0m0s","1h0m0s",1,false]]}]}]}',
    ),
    (  
        'dropping non-default custom shard retention policy succeed',
        'DROP RETENTION POLICY rp3 ON db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show retention policy should show just default',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rp0","2h0m0s","1h0m0s",3,true]]}]}]}',
    ),
    (  
        'Ensure retention policy with unacceptable retention cannot be created',
        'CREATE RETENTION POLICY rp4 ON db0 DURATION 1s REPLICATION 1',
        '{"results":[{"statement_id":0,"error":"retention policy duration must be at least 1h0m0s"}]}',
    ),
    (  
        'Check error when deleting retention policy on non-existent database',
        'DROP RETENTION POLICY rp1 ON mydatabase',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'Ensure retention policy for non existing db is not created',
        'CREATE RETENTION POLICY rp0 ON nodb DURATION 1h REPLICATION 1',
        '{"results":[{"statement_id":0,"error":"database not found: nodb"}]}',
    ),
    (  
        'drop rp0',
        'DROP RETENTION POLICY rp0 ON db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create retention policy with inf shard group duration',
        'CREATE RETENTION POLICY rpinf ON db0 DURATION INF REPLICATION 1 SHARD DURATION 0s',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create retention policy with 0s shard group duration',
        'CREATE RETENTION POLICY rpzero ON db0 DURATION 1h REPLICATION 1 SHARD DURATION 0s',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create retention policy with 1s shard group duration',
        'CREATE RETENTION POLICY rponesecond ON db0 DURATION 2h REPLICATION 1 SHARD DURATION 1s',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show retention policy: validate normalized shard group durations are working',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","replicaN","default"],"values":[["rpinf","0s","168h0m0s",1,false],["rpzero","1h0m0s","1h0m0s",1,false],["rponesecond","2h0m0s","1h0m0s",1,false]]}]}]}',
    ),
]

# --- measurement_commands (server_test.go:147) ---
X_3_WRITES = [
]

X_3_CASES = [
    (  
        'create database should succeed',
        'CREATE DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'create measurement cpu',
        'CREATE MEASUREMENT cpu',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'retry create measurement cpu',
        'CREATE MEASUREMENT cpu',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'create measurement cpu with shardkey',
        'CREATE MEASUREMENT cpu WITH SHARDKEY hostname',
        '{"results":[{"statement_id":0,"error":"measurement already exists"}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show measurements',
        'SHOW MEASUREMENTS',
        '{"results":[{"statement_id":0,"series":[{"name":"measurements","columns":["name"],"values":[["cpu"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'create measurement cpu2 with shardkey',
        'CREATE MEASUREMENT cpu2 WITH SHARDKEY hostname',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show measurements',
        'SHOW MEASUREMENTS',
        '{"results":[{"statement_id":0,"series":[{"name":"measurements","columns":["name"],"values":[["cpu"],["cpu2"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'drop measurement cpu2',
        'DROP MEASUREMENT cpu2',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show measurements',
        'SHOW MEASUREMENTS',
        '{"results":[{"statement_id":0,"series":[{"name":"measurements","columns":["name"],"values":[["cpu"]]}]}]}',
    ),
]

# --- delete_series_time (server_test.go:294) ---
X_4_WRITES = [
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
    'cpu,host=serverA,region=uswest val=100 946771200000000000',
    'cpu,host=serverA,region=uswest val=200 946857600000000000',
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
]

X_4_CASES = [
    (    # params: '"db": []string{"db0"'
        'Show series is present',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Delete series',
        "DELETE FROM cpu WHERE time < '2000-01-03T00:00:00Z'",
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Show series still exists',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Make sure last point still exists',
        'SELECT * FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","host","region","val"],"values":[["2000-01-03T00:00:00Z","serverA","uswest",200]]}]}]}',
    ),
    (    # params: '"db": []string{"db1"'
        "Make sure data wasn't deleted from other database.",
        'SELECT * FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","host","region","val"],"values":[["2000-01-01T00:00:00Z","serverA","uswest",23.2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Delete remaining instances of series',
        "DELETE FROM cpu WHERE time < '2000-01-04T00:00:00Z'",
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Show series should now be empty',
        'SHOW SERIES',
        '{"results":[{"statement_id":0}]}',
    ),
]

# --- delete_series_time_tag_filter (server_test.go:350) ---
X_5_WRITES = [
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
    'cpu,host=serverB,region=uswest val=23.2 946684800000000000',
    'cpu,host=serverA,region=uswest val=100 946771200000000000',
    'cpu,host=serverA,region=uswest val=200 946857600000000000',
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
]

X_5_CASES = [
    (    # params: '"db": []string{"db0"'
        'Show series is present',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=serverA,region=uswest"],["cpu,host=serverB,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Delete series',
        "DELETE FROM cpu WHERE host = 'serverA' AND time < '2000-01-03T00:00:00Z'",
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Show series still exists',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=serverA,region=uswest"],["cpu,host=serverB,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Make sure last point still exists',
        'SELECT * FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","host","region","val"],"values":[["2000-01-01T00:00:00Z","serverB","uswest",23.2],["2000-01-03T00:00:00Z","serverA","uswest",200]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Make sure other points are deleted',
        'SELECT COUNT(val) FROM cpu WHERE "host" = \'serverA\'',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",1]]}]}]}',
    ),
    (    # params: '"db": []string{"db1"'
        "Make sure data wasn't deleted from other database.",
        'SELECT * FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","host","region","val"],"values":[["2000-01-01T00:00:00Z","serverA","uswest",23.2]]}]}]}',
    ),
]

# --- drop_and_recreate_series (server_test.go:401) ---
X_6_WRITES = [
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
]

X_6_CASES = [
    (    # params: '"db": []string{"db0"'
        'Show series is present',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Drop series after data write',
        'DROP SERIES FROM cpu',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Show series is gone',
        'SHOW SERIES',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db1"'
        "Make sure data wasn't deleted from other database.",
        'SELECT * FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","host","region","val"],"values":[["2000-01-01T00:00:00Z","serverA","uswest",23.2]]}]}]}',
    ),
]

# --- drop_series_from_regex (server_test.go:452) ---
X_7_WRITES = [
    'a,host=serverA,region=uswest val=23.2 946684800000000000',
    'aa,host=serverA,region=uswest val=23.2 946684800000000000',
    'b,host=serverA,region=uswest val=23.2 946684800000000000',
    'c,host=serverA,region=uswest val=30.2 946684800000000000',
]

X_7_CASES = [
    (    # params: '"db": []string{"db0"'
        'Show series is present',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["a,host=serverA,region=uswest"],["aa,host=serverA,region=uswest"],["b,host=serverA,region=uswest"],["c,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Drop series after data write',
        'DROP SERIES FROM /a.*/',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Show series is gone',
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["b,host=serverA,region=uswest"],["c,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Drop series from regex that matches no measurements',
        'DROP SERIES FROM /a.*/',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        "make sure DROP SERIES doesn't delete anything when regex doesn't match",
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["b,host=serverA,region=uswest"],["c,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Drop series with WHERE field should error',
        'DROP SERIES FROM c WHERE val > 50.0',
        '{"results":[{"statement_id":0,"error":"shard 1: fields not supported in WHERE clause during deletion"}]}',
    ),
    (    # params: '"db": []string{"db0"'
        "make sure DROP SERIES with field in WHERE didn't delete data",
        'SHOW SERIES',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["b,host=serverA,region=uswest"],["c,host=serverA,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Drop series with WHERE time should error',
        'DROP SERIES FROM c WHERE time > now() - 1d',
        '{"results":[{"statement_id":0,"error":"DROP SERIES doesn\'t support time in WHERE clause"}]}',
    ),
]

# --- drop_and_recreate_database (server_test.go:214) ---
X_8_WRITES = [
    'cpu,host=serverA,region=uswest val=23.2 946684800000000000',
]

X_8_CASES = [
    (  
        'Drop database after data write',
        'DROP DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'Recreate database',
        'CREATE DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'Recreate retention policy',
        'CREATE RETENTION POLICY rp0 ON db0 DURATION 365d REPLICATION 1 DEFAULT',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Show measurements after recreate',
        'SHOW MEASUREMENTS',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'Query data after recreate',
        'SELECT * FROM cpu',
        '{"results":[{"statement_id":0,"error":"measurement not found"}]}',
    ),
]

# --- retention_policy_auto_create (server_test.go:649) ---
X_9_WRITES = [
]

X_9_CASES = [
    (  
        'create database should succeed',
        'CREATE DATABASE db0',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show retention policies should return auto-created policy',
        'SHOW RETENTION POLICIES ON db0',
        '{"results":[{"statement_id":0,"series":[{"columns":["name","duration","shardGroupDuration","hot duration","warm duration","index duration","replicaN","default"],"values":[["autogen","0s","168h0m0s","0s","0s","168h0m0s",1,true]]}]}]}',
    ),
]


OMIT = {
    "Make sure data wasn't deleted from other database.",
}
# stale 5-column SHOW RETENTION POLICIES expectations (see module doc)
OMIT_RPC_SHOW = {
    "show retention policy should succeed",
    "show retention policy should have new altered information",
    "show retention policy should still show policy",
    "show retention policy should show both",
    "show retention policy should show both with custom shard",
    "show retention policy should show just default",
    "show retention policy: validate normalized shard group durations are working",
}

# (tag, writes, cases, extra-omit, pre-create db0/rp0) — suites that
# create their own databases start from a pristine meta store, like the
# reference's per-test server
SUITES = [
    ("user", "UC_WRITES", "UC_CASES", set(), True),
    ("dbc", "X_WRITES", "X_CASES", set(), False),
    ("rpc", "X_2_WRITES", "X_2_CASES", OMIT_RPC_SHOW, "db"),
    ("mc", "X_3_WRITES", "X_3_CASES", set(), False),
    ("dst", "X_4_WRITES", "X_4_CASES", set(), True),
    ("dsttf", "X_5_WRITES", "X_5_CASES", set(), True),
    ("dars", "X_6_WRITES", "X_6_CASES", set(), True),
    ("dsfr", "X_7_WRITES", "X_7_CASES", set(), True),
    ("dard", "X_8_WRITES", "X_8_CASES", set(), True),
    ("rpac", "X_9_WRITES", "X_9_CASES", set(), False),
]

_g = globals()


@pytest.mark.parametrize(
    "tag,w,c,extra_omit,pre", SUITES, ids=[s[0] for s in SUITES]
)
def test_parity7_suite(spark, sf_dir, tmp_path, tag, w, c, extra_omit, pre):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    root = str(tmp_path / "data")
    ddl = DDLExecutor(spark, MetaStore(str(tmp_path / "meta")))
    if pre:
        # the reference's per-test server pre-creates db0 (and rp0 when
        # pre is True; "db" creates the database only)
        ddl.execute("CREATE DATABASE db0")
        if pre is True:
            ddl.execute(
                "CREATE RETENTION POLICY rp0 ON db0 DURATION 0s "
                "REPLICATION 1 DEFAULT"
            )
    if _g[w]:
        handle_write(spark, _g[w], root)
    for name, q, exp in _g[c]:
        if name in OMIT or name in extra_omit:
            continue
        got = handle_query(spark, sf_dir, q, epoch=None,
                           data_root=root, ddl=ddl)
        assert got == json.loads(exp), (
            f"suite {tag} case {name!r}: {json.dumps(got)}"
        )


def test_show_measurements_detail(spark, sf_dir, tmp_path):
    """TestServer_Query_ShowMeasurementsDetail — typed CREATE MEASUREMENT
    (column list + ENGINETYPE/SHARDKEY/PRIMARYKEY) and the Detail wire
    shape for columnstore and tsstore measurements."""
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(spark, MetaStore(str(tmp_path / "meta")))
    ddl.execute("CREATE DATABASE db0")
    ddl.execute(
        "CREATE RETENTION POLICY rp0 ON db0 DURATION 0s REPLICATION 1 "
        "DEFAULT"
    )
    ddl.execute(
        "CREATE MEASUREMENT db0.rp0.cpu (region tag,  az tag, v1 int64,  "
        "v2 float64,  v3 bool, v4 string) WITH  ENGINETYPE = columnstore  "
        "SHARDKEY az,region PRIMARYKEY az,region,time"
    )
    ddl.execute(
        "CREATE MEASUREMENT db0.rp0.gpu (region tag,  az tag, v1 int64,  "
        "v2 float64,  v3 bool, v4 string)"
    )
    got = handle_query(
        spark, sf_dir, "show measurements detail with measurement = cpu",
        epoch=None, ddl=ddl,
    )
    assert got == json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":'
        '["Detail"],"values":[["RETENTION POLICY: rp0"],["INDEX: <nil>"],'
        '["SHARD KEY: az, region"],["ENGINE TYPE: columnstore"],'
        '["PRIMARY KEY: az, region, time"],["SORT KEY: az, region, time"],'
        '["COMPACTION_TYPE: row"],["TAG KEYS: az, region"],'
        '["FIELD KEYS: v1(integer), v2(float), v3(boolean), v4(string)"]]}'
        ']}]}'
    )
    got2 = handle_query(
        spark, sf_dir, "show measurements detail with measurement = gpu",
        epoch=None, ddl=ddl,
    )
    assert got2 == json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"gpu","columns":'
        '["Detail"],"values":[["RETENTION POLICY: rp0"],["INDEX: <nil>"],'
        '["SHARD KEY: <nil>"],["ENGINE TYPE: tsstore"],'
        '["TAG KEYS: az, region"],'
        '["FIELD KEYS: v1(integer), v2(float), v3(boolean), v4(string)"]]}'
        ']}]}'
    )


# --- TestServer_Query_By_Chunked_SingleMst (server_test.go:8876):
# chunked=true emission — one JSON document per chunk, partial flags on
# every chunk but the last ---
CHK_WRITES = [
    'survey,country=China,name=ada      age=15,height=170i,sex=false,city="chengdu" 1625558240121000000',
    'survey,country=China,name=billy    age=27,height=165i,sex=false,city="shenzhen" 1625558240122000000',
    'survey,country=China,name=demon    age=57,height=150i,sex=false,city="shanghai" 1625558240123000000',
    'survey,country=China,name=king    age=22,height=167i,sex=false,city="beijing" 1625558240124000000',
    'survey,country=Egypt,name=chris   age=31,height=159i,sex=false,city="elilansa" 1625558242121000000',
    'survey,country=Egypt,name=daisy   age=40,height=178i,sex=true,city="gunilanduo" 1625558242122000000',
    'survey,country=France,name=paul   age=45,height=164i,sex=true,city="paris" 1625558242123000000',
    'survey,country=Germany,name=frank age=35,height=169i,sex=true,city="bakeli" 1625558242124000000',
    'survey,country=Japan,name=jack    age=21,height=190i,sex=true,city="dongjin" 1625558242125000000',
]

CHK_CASES = [
    (
        'query with a single measurement by chunk size 1',
        'SELECT * FROM survey',
        1,
        '{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.121Z",15,"chengdu","China",170,"ada",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.122Z",27,"shenzhen","China",165,"billy",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.123Z",57,"shanghai","China",150,"demon",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.124Z",22,"beijing","China",167,"king",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.121Z",31,"elilansa","Egypt",159,"chris",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.122Z",40,"gunilanduo","Egypt",178,"daisy",true]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.123Z",45,"paris","France",164,"paul",true]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.124Z",35,"bakeli","Germany",169,"frank",true]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.125Z",21,"dongjin","Japan",190,"jack",true]]}]}]}',
    ),
    (
        'query with a single measurement by chunk size 4',
        'SELECT * FROM survey',
        4,
        '{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.121Z",15,"chengdu","China",170,"ada",false],["2021-07-06T07:57:20.122Z",27,"shenzhen","China",165,"billy",false],["2021-07-06T07:57:20.123Z",57,"shanghai","China",150,"demon",false],["2021-07-06T07:57:20.124Z",22,"beijing","China",167,"king",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.121Z",31,"elilansa","Egypt",159,"chris",false],["2021-07-06T07:57:22.122Z",40,"gunilanduo","Egypt",178,"daisy",true],["2021-07-06T07:57:22.123Z",45,"paris","France",164,"paul",true],["2021-07-06T07:57:22.124Z",35,"bakeli","Germany",169,"frank",true]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.125Z",21,"dongjin","Japan",190,"jack",true]]}]}]}',
    ),
    (
        'query with a single measurement by chunk size 3 and inner chunk size 4',
        'SELECT * FROM survey',
        3,
        '{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.121Z",15,"chengdu","China",170,"ada",false],["2021-07-06T07:57:20.122Z",27,"shenzhen","China",165,"billy",false],["2021-07-06T07:57:20.123Z",57,"shanghai","China",150,"demon",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:20.124Z",22,"beijing","China",167,"king",false],["2021-07-06T07:57:22.121Z",31,"elilansa","Egypt",159,"chris",false],["2021-07-06T07:57:22.122Z",40,"gunilanduo","Egypt",178,"daisy",true]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","columns":["time","age","city","country","height","name","sex"],"values":[["2021-07-06T07:57:22.123Z",45,"paris","France",164,"paul",true],["2021-07-06T07:57:22.124Z",35,"bakeli","Germany",169,"frank",true],["2021-07-06T07:57:22.125Z",21,"dongjin","Japan",190,"jack",true]]}]}]}',
    ),
    (
        'query with a single measurement by chunk size 1 and inner chunk size 3',
        'SELECT * FROM survey group by country',
        1,
        '{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.121Z",15,"chengdu",170,"ada",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.122Z",27,"shenzhen",165,"billy",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.123Z",57,"shanghai",150,"demon",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.124Z",22,"beijing",167,"king",false]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Egypt"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.121Z",31,"elilansa",159,"chris",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Egypt"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.122Z",40,"gunilanduo",178,"daisy",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"France"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.123Z",45,"paris",164,"paul",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Germany"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.124Z",35,"bakeli",169,"frank",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Japan"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.125Z",21,"dongjin",190,"jack",true]]}]}]}',
    ),
    (
        'query with a single measurement by chunk size 3 and inner chunk size 3',
        'SELECT * FROM survey group by country',
        3,
        '{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.121Z",15,"chengdu",170,"ada",false],["2021-07-06T07:57:20.122Z",27,"shenzhen",165,"billy",false],["2021-07-06T07:57:20.123Z",57,"shanghai",150,"demon",false]],"partial":true}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.124Z",22,"beijing",167,"king",false]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Egypt"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.121Z",31,"elilansa",159,"chris",false],["2021-07-06T07:57:22.122Z",40,"gunilanduo",178,"daisy",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"France"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.123Z",45,"paris",164,"paul",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Germany"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.124Z",35,"bakeli",169,"frank",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Japan"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.125Z",21,"dongjin",190,"jack",true]]}]}]}',
    ),
    (
        'query with a single measurement by chunk size 5 and inner chunk size 3',
        'SELECT * FROM survey group by country',
        5,
        '{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"China"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:20.121Z",15,"chengdu",170,"ada",false],["2021-07-06T07:57:20.122Z",27,"shenzhen",165,"billy",false],["2021-07-06T07:57:20.123Z",57,"shanghai",150,"demon",false],["2021-07-06T07:57:20.124Z",22,"beijing",167,"king",false]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Egypt"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.121Z",31,"elilansa",159,"chris",false],["2021-07-06T07:57:22.122Z",40,"gunilanduo",178,"daisy",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"France"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.123Z",45,"paris",164,"paul",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Germany"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.124Z",35,"bakeli",169,"frank",true]]}],"partial":true}]}\n{"results":[{"statement_id":0,"series":[{"name":"survey","tags":{"country":"Japan"},"columns":["time","age","city","height","name","sex"],"values":[["2021-07-06T07:57:22.125Z",21,"dongjin",190,"jack",true]]}]}]}',
    ),
]


def test_parity7_chunked(spark, sf_dir, tmp_path):
    from opengemini_spark.api import handle_query_chunked

    root = str(tmp_path / "chk")
    handle_write(spark, CHK_WRITES, root)
    for name, q, size, exp in CHK_CASES:
        docs = handle_query_chunked(
            spark, sf_dir, q, chunk_size=size, epoch=None, data_root=root
        )
        want = [json.loads(x) for x in exp.strip().split("\n")]
        assert docs == want, f"case {name!r}: {json.dumps(docs)[:400]}"
