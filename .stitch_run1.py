import json
exec(open("/root/repo/.stitch_proto.py").read().split('res = {}')[0])
print(json.dumps({"L16384_G8_Gs16": run(16384, 8, 16)}))
