module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<4096x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<4096x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<4096x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 1, 2, 1>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 4, 1024, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 4, 2048, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 4, 2048, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 4, 1024, 128>}]} {
    %cst = arith.constant dense<0.127517432> : vector<1024x128xf32>
    %c3584 = arith.constant 3584 : index
    %c3072 = arith.constant 3072 : index
    %c3 = arith.constant 3 : index
    %c2560 = arith.constant 2560 : index
    %c2048 = arith.constant 2048 : index
    %c2 = arith.constant 2 : index
    %c1536 = arith.constant 1536 : index
    %c1024 = arith.constant 1024 : index
    %c1 = arith.constant 1 : index
    %c512 = arith.constant 512 : index
    %cst_0 = arith.constant dense<0.000000e+00> : vector<512x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<512xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<512xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<512x2048xf32>
    %c0 = arith.constant 0 : index
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %4 = arith.extf %3 : vector<1024x128xbf16> to vector<1024x128xf32>
    %5 = arith.mulf %4, %cst : vector<1024x128xf32>
    %6 = arith.truncf %5 : vector<1024x128xf32> to vector<1024x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %11 = vector.extract_strided_slice %6 {offsets = [0, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %12 = tpu.matmul %11, %8, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %12, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %12, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %13 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %13 {
      %62 = vector.load %arg9[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %12, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %12, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %14 = vector.extract_strided_slice %6 {offsets = [512, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %15 = tpu.matmul %14, %8, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %15, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %15, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %16 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %16 {
      %62 = vector.load %arg9[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %15, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %15, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %17 = vector.load %arg4[%c0, %c1, %c0, %c0] : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %18 = vector.shape_cast %17 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %19 = arith.extf %18 : vector<1024x128xbf16> to vector<1024x128xf32>
    %20 = arith.mulf %19, %cst : vector<1024x128xf32>
    %21 = arith.truncf %20 : vector<1024x128xf32> to vector<1024x128xbf16>
    %22 = vector.load %arg5[%c0, %c1, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %23 = vector.shape_cast %22 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %24 = vector.load %arg6[%c0, %c1, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %25 = vector.shape_cast %24 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %26 = vector.extract_strided_slice %21 {offsets = [0, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %27 = tpu.matmul %26, %23, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %27, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %27, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c1024, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1024, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1024, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %28 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %28 {
      %62 = vector.load %arg9[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %27, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %27, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c1024, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1024, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1024, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %29 = vector.extract_strided_slice %21 {offsets = [512, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %30 = tpu.matmul %29, %23, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %30, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %30, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c1536, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1536, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1536, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %31 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %31 {
      %62 = vector.load %arg9[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %30, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %30, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c1536, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1536, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1536, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %32 = vector.load %arg4[%c0, %c2, %c0, %c0] : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %33 = vector.shape_cast %32 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %34 = arith.extf %33 : vector<1024x128xbf16> to vector<1024x128xf32>
    %35 = arith.mulf %34, %cst : vector<1024x128xf32>
    %36 = arith.truncf %35 : vector<1024x128xf32> to vector<1024x128xbf16>
    %37 = vector.load %arg5[%c0, %c2, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %38 = vector.shape_cast %37 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %39 = vector.load %arg6[%c0, %c2, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %40 = vector.shape_cast %39 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %41 = vector.extract_strided_slice %36 {offsets = [0, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %42 = tpu.matmul %41, %38, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %42, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %42, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c2048, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2048, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2048, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %43 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %43 {
      %62 = vector.load %arg9[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %42, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %42, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c2048, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2048, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2048, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %44 = vector.extract_strided_slice %36 {offsets = [512, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %45 = tpu.matmul %44, %38, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %45, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %45, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c2560, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2560, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2560, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %46 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %46 {
      %62 = vector.load %arg9[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %45, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %45, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c2560, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2560, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2560, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %47 = vector.load %arg4[%c0, %c3, %c0, %c0] : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %48 = vector.shape_cast %47 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %49 = arith.extf %48 : vector<1024x128xbf16> to vector<1024x128xf32>
    %50 = arith.mulf %49, %cst : vector<1024x128xf32>
    %51 = arith.truncf %50 : vector<1024x128xf32> to vector<1024x128xbf16>
    %52 = vector.load %arg5[%c0, %c3, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %53 = vector.shape_cast %52 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %54 = vector.load %arg6[%c0, %c3, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %55 = vector.shape_cast %54 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %56 = vector.extract_strided_slice %51 {offsets = [0, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %57 = tpu.matmul %56, %53, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %57, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %57, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c3072, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3072, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3072, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %58 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %58 {
      %62 = vector.load %arg9[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %57, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %57, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c3072, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3072, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3072, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %59 = vector.extract_strided_slice %51 {offsets = [512, 0], sizes = [512, 128], strides = [1, 1]} : vector<1024x128xbf16> to vector<512x128xbf16>
    %60 = tpu.matmul %59, %53, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<2048x128xbf16>, vector<512x2048xf32> -> vector<512x2048xf32>
    scf.if %0 {
      %62 = vector.multi_reduction <maximumf>, %60, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %63 = vector.shape_cast %62 : vector<512xf32> to vector<512x1xf32>
      %64 = vector.broadcast %63 : vector<512x1xf32> to vector<512x128xf32>
      %65 = vector.broadcast %63 : vector<512x1xf32> to vector<512x2048xf32>
      %66 = arith.subf %60, %65 : vector<512x2048xf32>
      %67 = math.exp2 %66 : vector<512x2048xf32>
      %68 = arith.truncf %67 : vector<512x2048xf32> to vector<512x2048xbf16>
      %69 = vector.multi_reduction <add>, %67, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %70 = vector.shape_cast %69 : vector<512xf32> to vector<512x1xf32>
      %71 = vector.broadcast %70 : vector<512x1xf32> to vector<512x128xf32>
      %72 = tpu.matmul %68, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c3584, %c0], %64 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3584, %c0], %71 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3584, %c0], %72 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %61 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %61 {
      %62 = vector.load %arg9[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %63 = vector.load %arg10[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %64 = vector.load %arg8[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %65 = vector.multi_reduction <maximumf>, %60, %cst_2 [1] : vector<512x2048xf32> to vector<512xf32>
      %66 = vector.shape_cast %65 : vector<512xf32> to vector<512x1xf32>
      %67 = vector.broadcast %66 : vector<512x1xf32> to vector<512x128xf32>
      %68 = arith.maximumf %62, %67 : vector<512x128xf32>
      %69 = vector.extract_strided_slice %68 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %70 = vector.broadcast %69 : vector<512x1xf32> to vector<512x2048xf32>
      %71 = arith.subf %60, %70 : vector<512x2048xf32>
      %72 = math.exp2 %71 : vector<512x2048xf32>
      %73 = arith.subf %62, %68 : vector<512x128xf32>
      %74 = math.exp2 %73 : vector<512x128xf32>
      %75 = arith.truncf %72 : vector<512x2048xf32> to vector<512x2048xbf16>
      %76 = arith.mulf %63, %74 : vector<512x128xf32>
      %77 = vector.multi_reduction <add>, %72, %cst_1 [1] : vector<512x2048xf32> to vector<512xf32>
      %78 = vector.shape_cast %77 : vector<512xf32> to vector<512x1xf32>
      %79 = vector.broadcast %78 : vector<512x1xf32> to vector<512x128xf32>
      %80 = arith.addf %76, %79 : vector<512x128xf32>
      %81 = tpu.matmul %75, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x2048xbf16>, vector<2048x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %82 = vector.extract_strided_slice %74 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %83 = vector.broadcast %82 : vector<512x1xf32> to vector<512x128xf32>
      %84 = arith.mulf %64, %83 : vector<512x128xf32>
      %85 = arith.addf %84, %81 : vector<512x128xf32>
      tpu.vector_store %arg9[%c3584, %c0], %68 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3584, %c0], %80 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3584, %c0], %85 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    scf.if %1 {
      %62 = vector.load %arg10[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x1xf32>
      %63 = vector.load %arg8[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x128xf32>
      %64 = vector.broadcast %62 : vector<1024x1xf32> to vector<1024x128xf32>
      %65 = arith.divf %63, %64 : vector<1024x128xf32>
      %66 = arith.truncf %65 : vector<1024x128xf32> to vector<1024x128xbf16>
      %67 = vector.shape_cast %66 : vector<1024x128xbf16> to vector<1x1x1024x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %67 {strides = array<i32>} : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>, 
      %68 = vector.load %arg10[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x1xf32>
      %69 = vector.load %arg8[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x128xf32>
      %70 = vector.broadcast %68 : vector<1024x1xf32> to vector<1024x128xf32>
      %71 = arith.divf %69, %70 : vector<1024x128xf32>
      %72 = arith.truncf %71 : vector<1024x128xf32> to vector<1024x128xbf16>
      %73 = vector.shape_cast %72 : vector<1024x128xbf16> to vector<1x1x1024x128xbf16>
      tpu.vector_store %arg7[%c0, %c1, %c0, %c0], %73 {strides = array<i32>} : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>, 
      %74 = vector.load %arg10[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x1xf32>
      %75 = vector.load %arg8[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x128xf32>
      %76 = vector.broadcast %74 : vector<1024x1xf32> to vector<1024x128xf32>
      %77 = arith.divf %75, %76 : vector<1024x128xf32>
      %78 = arith.truncf %77 : vector<1024x128xf32> to vector<1024x128xbf16>
      %79 = vector.shape_cast %78 : vector<1024x128xbf16> to vector<1x1x1024x128xbf16>
      tpu.vector_store %arg7[%c0, %c2, %c0, %c0], %79 {strides = array<i32>} : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>, 
      %80 = vector.load %arg10[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x1xf32>
      %81 = vector.load %arg8[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<1024x128xf32>
      %82 = vector.broadcast %80 : vector<1024x1xf32> to vector<1024x128xf32>
      %83 = arith.divf %81, %82 : vector<1024x128xf32>
      %84 = arith.truncf %83 : vector<1024x128xf32> to vector<1024x128xbf16>
      %85 = vector.shape_cast %84 : vector<1024x128xbf16> to vector<1x1x1024x128xbf16>
      tpu.vector_store %arg7[%c0, %c3, %c0, %c0], %85 {strides = array<i32>} : memref<1x4x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c4_i32 = arith.constant 4 : i32
    %0 = arith.muli %arg1, %c4_i32 : i32
    %1 = arith.divsi %0, %c4_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c4_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c4_i32 = arith.constant 4 : i32
    %0 = arith.muli %arg1, %c4_i32 : i32
    %1 = arith.divsi %0, %c4_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c4_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

